"""Train baseline tokenizers (BPE/WordPiece/Unigram/char) for comparison.

CLI parity with ``scripts/train_baseline_tokenizers.py:514-568``.
"""

from __future__ import annotations

import argparse
import json

from hyptokenizer_tpu.cli._common import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-file", action="append", required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--vocab-size", action="append", type=int, default=None)
    p.add_argument("--kinds", type=str, default="bpe,wordpiece,unigram,char")
    args = p.parse_args(argv)
    setup_logging()

    from hyptokenizer_tpu.evals.baselines import train_all_baselines

    sizes = args.vocab_size or [10_000, 20_000, 50_000]
    results = train_all_baselines(
        args.input_file, args.output_dir, vocab_sizes=sizes,
        kinds=tuple(args.kinds.split(",")))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
