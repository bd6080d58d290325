"""Device-resident index structures (sparse postings, dense embeddings)."""

from .sparse import BM25Stats, SparseIndex, build_sparse_index  # noqa: F401
from .dense import DenseIndex  # noqa: F401
