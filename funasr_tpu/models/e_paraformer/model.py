"""E-Paraformer (reference funasr/models/e_paraformer/model.py:31 — the
Paraformer body with the parallel integrate-and-fire (PIF) predictor and a
stronger CTC branch, per the Interspeech 2024 E-Paraformer paper).

Everything except the predictor is the Paraformer machinery; on TPU the
PIF predictor is strictly better-shaped than CIF (one softmax-matmul
instead of a cumsum-driven overlap contraction), so this family is the
preferred high-throughput configuration.
"""

from __future__ import annotations

from funasr_tpu.models.e_paraformer.predictor import PifPredictor
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.registry import tables


@tables.register("model_classes", "EParaformer")
class EParaformer(Paraformer):
    ctc_weight: float = 0.5

    def make_predictor(self, d_model: int):
        conf = dict(self.predictor_conf or {})
        conf.setdefault("idim", d_model)
        conf.pop("tail_threshold", None)
        return PifPredictor(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="predictor", **conf)
