"""Val-set compression stats for a saved tokenizer (any method).

Usage: python tools/tok_stats.py <val.txt> <tokenizer-dir-or-json> [method]

Prints one JSON line: tokens/char on the val text (chars counted on the raw
text, so lossless and space-dropping tokenizers are compared on the same
denominator — the comparison RESULTS.md's side-by-side tables use).
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    val_path, model = sys.argv[1], sys.argv[2]
    method = sys.argv[3] if len(sys.argv) > 3 else (
        "hyperbolic" if os.path.isdir(model) else "hf")
    lines = [ln.rstrip("\n") for ln in open(val_path, encoding="utf-8")
             if ln.strip()]
    chars = sum(len(ln) for ln in lines)
    if method == "hyperbolic":
        from hyptokenizer_tpu.tokenizer import HyperbolicTokenizer
        tok = HyperbolicTokenizer.load(model)
        ids_list = tok.encode_batch(lines)  # single encode pass
        toks = sum(len(ids) for ids in ids_list)
        vocab = len(tok.vocab)
        used = len({i for ids in ids_list for i in ids})
    else:
        from tokenizers import Tokenizer
        tok = Tokenizer.from_file(model)
        encs = tok.encode_batch(lines)
        toks = sum(len(e.ids) for e in encs)
        vocab = tok.get_vocab_size()
        used = len({i for e in encs for i in e.ids})
    print(json.dumps({
        "model": model, "method": method, "vocab": vocab,
        "val_tokens": toks, "val_chars": chars,
        "tokens_per_char": round(toks / chars, 4),
        "chars_per_token": round(chars / toks, 3),
        "val_used_tokens": used,
    }))


if __name__ == "__main__":
    main()
