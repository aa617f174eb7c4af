"""Tokenizer algorithms (L3): the heart of the framework.

- ``state``   — the merge loop as a jitted device state machine
- ``search``  — exact incremental candidate search (replaces FAISS)
- ``core``    — host-side ``HyperbolicTokenizer`` API (reference-parity surface)
- ``encode``  — conformant tokenize/encode/decode (+ native fast path)
- ``normalize`` — opt-in Unicode normalization + lossless regex pre-split
"""

from hyptokenizer_tpu.tokenizer.core import (  # noqa: F401
    FastHyperbolicTokenizer,
    HyperbolicTokenizer,
)
from hyptokenizer_tpu.tokenizer.encode import Encoder  # noqa: F401
from hyptokenizer_tpu.tokenizer.normalize import (  # noqa: F401
    NormalizerConfig,
    WHITESPACE,
    WORDS_WITH_SPACE,
)
from hyptokenizer_tpu.tokenizer.enhanced import (  # noqa: F401
    AdaptiveCurvatureTokenizer,
    CompressionAwareTokenizer,
    EnhancedFastHyperbolicTokenizer,
    EnhancedHyperbolicTokenizer,
    FrequencyAwareHyperbolicTokenizer,
    HierarchicalHyperbolicTokenizer,
)
from hyptokenizer_tpu.tokenizer.state import (  # noqa: F401
    MergeConfig,
    MergeState,
    init_state,
    merge_step,
    run_merges,
)
