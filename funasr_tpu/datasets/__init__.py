import funasr_tpu.datasets.index_ds  # noqa: F401
import funasr_tpu.datasets.samplers  # noqa: F401
import funasr_tpu.datasets.dataset  # noqa: F401
import funasr_tpu.datasets.dataloader  # noqa: F401
import funasr_tpu.datasets.llm_dataset  # noqa: F401
import funasr_tpu.datasets.preprocessor  # noqa: F401
