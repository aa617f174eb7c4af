"""Preprocess raw text (wiki dumps or plain text) and build an initial vocab.

CLI parity with ``scripts/preprocess_wiki.py`` (clean_text pipeline, BZ2-aware
streaming, char-frequency vocab with min_count filter).
"""

from __future__ import annotations

import argparse
import os

from hyptokenizer_tpu.cli._common import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-path", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--min-line-length", type=int, default=10)
    p.add_argument("--max-lines", type=int, default=None)
    p.add_argument("--min-count", type=int, default=5)
    args = p.parse_args(argv)
    setup_logging()

    from hyptokenizer_tpu.utils import data

    os.makedirs(args.output_dir, exist_ok=True)
    out_text = os.path.join(args.output_dir, "wiki_processed.txt")
    n = 0
    with data.open_text(args.input_path) as fin, \
            open(out_text, "w", encoding="utf-8") as fout:
        for cleaned in data.preprocess_lines(fin, args.min_line_length):
            fout.write(cleaned + "\n")
            n += 1
            if args.max_lines and n >= args.max_lines:
                break
    print(f"wrote {n} cleaned lines to {out_text}")

    with open(out_text, encoding="utf-8") as f:
        vocab = data.build_initial_vocab(f, min_count=args.min_count)
    out_vocab = os.path.join(args.output_dir, "vocab_initial.txt")
    data.save_vocab(vocab, out_vocab)
    print(f"wrote vocabulary with {len(vocab)} tokens to {out_vocab}")


if __name__ == "__main__":
    main()
