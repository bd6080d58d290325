"""TPU compute kernels (XLA + Pallas) for scoring, top-k, and fusion."""

from .topk import topk_desc_reference_order  # noqa: F401
from .bm25 import bm25_score_topk, bm25_scores  # noqa: F401
from .bm25_resident import ResidentSparseIndex  # noqa: F401
