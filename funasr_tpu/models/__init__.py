"""Model zoo. Importing this package registers all model/encoder/decoder/
predictor classes into the global tables (funasr_tpu.registry)."""

import funasr_tpu.models.sanm  # noqa: F401
import funasr_tpu.models.paraformer  # noqa: F401
import funasr_tpu.models.fsmn_vad  # noqa: F401
import funasr_tpu.models.ct_transformer  # noqa: F401
import funasr_tpu.models.sense_voice  # noqa: F401
import funasr_tpu.models.conformer  # noqa: F401
import funasr_tpu.models.transformer  # noqa: F401
import funasr_tpu.models.paraformer_streaming  # noqa: F401
import funasr_tpu.models.bicif_paraformer  # noqa: F401
import funasr_tpu.models.seaco_paraformer  # noqa: F401
import funasr_tpu.models.campplus  # noqa: F401
import funasr_tpu.models.language_model  # noqa: F401
import funasr_tpu.models.transducer  # noqa: F401
import funasr_tpu.models.monotonic_aligner  # noqa: F401
import funasr_tpu.models.whisper  # noqa: F401
import funasr_tpu.models.branchformer  # noqa: F401
import funasr_tpu.models.eres2net  # noqa: F401
import funasr_tpu.models.xvector  # noqa: F401
import funasr_tpu.models.kws  # noqa: F401
import funasr_tpu.models.emotion2vec  # noqa: F401
import funasr_tpu.models.llm_asr  # noqa: F401
import funasr_tpu.models.uniasr  # noqa: F401
import funasr_tpu.models.scama  # noqa: F401
import funasr_tpu.models.eend  # noqa: F401
import funasr_tpu.models.data2vec  # noqa: F401
import funasr_tpu.models.contextual_paraformer  # noqa: F401
import funasr_tpu.models.mossformer  # noqa: F401
import funasr_tpu.models.rwkv  # noqa: F401
import funasr_tpu.models.e_paraformer  # noqa: F401
import funasr_tpu.models.qwen_audio  # noqa: F401
import funasr_tpu.models.sa_asr  # noqa: F401
import funasr_tpu.models.sond  # noqa: F401
import funasr_tpu.models.mfcca  # noqa: F401
import funasr_tpu.models.lcbnet  # noqa: F401
import funasr_tpu.ops.normalize  # noqa: F401
