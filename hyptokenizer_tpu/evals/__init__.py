"""Evaluation & analysis (L5): hierarchy distortion, tokenizer comparison,
throughput benchmarks."""

from hyptokenizer_tpu.evals.hierarchy import (  # noqa: F401
    compute_distortion,
    create_node_mapping,
    load_wordnet_graph,
)
from hyptokenizer_tpu.evals.comparison import (  # noqa: F401
    compression_efficiency,
    linguistic_quality,
    measure_throughput,
)
