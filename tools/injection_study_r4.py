"""Embedding-injection study (VERDICT r3 #5): does injecting hyperbolic
embeddings into BERT help or hurt, at n >= 500 eval examples with CIs?

Round 3 measured injected 73.4% vs non-injected 86.2% held-out cls accuracy
on a single 109-example split — high variance, unexplained. Suspect: the
exported tangent embeddings have std ~0.24 vs BERT's 0.02 init std (12x),
so injected rows dominate the word+pos+type embedding sum until the
optimizer unlearns the scale. This study runs a k-fold x multi-seed grid
over three arms:

  none    — fresh BERT init (no injection)
  raw     — inject values unscaled (the reference's behavior)
  matched — inject rescaled to the 0.02 init std (directions preserved)

Classification: 5-fold CV x 2 model seeds (every example evaluated once per
seed). MLM: 2 seeds per arm, val perplexity. Writes JSON + a markdown table.

Usage: python tools/injection_study_r4.py <workdir-with-train/val.txt> \
           <tokenizer-dir> [out.json]
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_cls_rows(corpus_path: str, n_articles: int = 30):
    """label<TAB>sentence rows from the cleaned wiki corpus: one class per
    article (short non-period line = title), sentences >= 40 chars."""
    articles, cur = [], None
    with open(corpus_path, encoding="utf-8") as f:
        for l in f:
            w = l.split()
            if 0 < len(w) <= 6 and not l.rstrip().endswith("."):
                cur = {"t": l.strip(), "x": []}
                articles.append(cur)
            elif cur is not None and l.strip():
                cur["x"].append(l.strip())
    articles = [a for a in articles if a["x"]]
    articles.sort(key=lambda a: -sum(len(t) for t in a["x"]))
    rows = []
    for lab, a in enumerate(articles[:n_articles]):
        for t in a["x"]:
            for s in re.split(r"(?<=\.) ", t):
                if len(s.strip()) > 40:
                    rows.append((lab, s.strip()))
    rng = np.random.default_rng(0)
    rng.shuffle(rows)
    return rows


def main():
    work = sys.argv[1]
    tok_dir = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        work, "injection_study_r4.json")

    from hyptokenizer_tpu.models import nlp

    adapter = nlp.TokenizerAdapter("hyperbolic", tok_dir)
    emb = adapter.get_embeddings()
    vocab_size = adapter.get_vocab_size()

    rows = build_cls_rows(os.path.join(work, "wiki.txt")
                          if os.path.exists(os.path.join(work, "wiki.txt"))
                          else os.path.join(work, "train.txt"))
    labels_all = [l for l, _ in rows]
    texts_all = [t for _, t in rows]
    n_labels = max(labels_all) + 1
    enc_all = adapter.batch_encode(texts_all, max_length=128)
    n = len(rows)
    print(f"cls dataset: {n} examples, {n_labels} classes", flush=True)

    K_FOLDS, SEEDS = 5, (0, 1)
    folds = np.arange(n) % K_FOLDS  # rows pre-shuffled

    def subset(enc, labs, mask):
        idx = np.nonzero(mask)[0]
        return ({"input_ids": [enc["input_ids"][i] for i in idx],
                 "attention_mask": [enc["attention_mask"][i] for i in idx]},
                [labs[i] for i in idx])

    arms = {"none": None, "raw": "raw", "matched": "matched"}
    results = {a: {"cls_acc": [], "cls_n": 0, "mlm_ppl": []} for a in arms}

    for arm, scale in arms.items():
        for seed in SEEDS:
            correct = total = 0
            for k in range(K_FOLDS):
                tr_enc, tr_lab = subset(enc_all, labels_all, folds != k)
                va_enc, va_lab = subset(enc_all, labels_all, folds == k)
                model = nlp.build_bert_classifier(
                    vocab_size, num_labels=n_labels, hidden=128, layers=2,
                    heads=4, seed=seed,
                    embeddings=emb if scale else None,
                    inject_scale=scale or "raw")
                _, acc = nlp.classification_train(
                    model, tr_enc, tr_lab, epochs=6, batch_size=16,
                    max_length=128, lr=5e-4, seed=seed,
                    eval_encoded=va_enc, eval_labels=va_lab)
                results[arm]["cls_acc"].append(float(acc))
                correct += acc * len(va_lab)
                total += len(va_lab)
                print(f"  {arm} seed={seed} fold={k}: acc={acc:.3f}",
                      flush=True)
            results[arm]["cls_n"] = total
            print(f"{arm} seed={seed}: pooled CV acc {correct/total:.4f} "
                  f"(n={total})", flush=True)

    # MLM arms (same protocol as RESULTS.md round-3 rematch).
    tr_lines = [l.strip() for l in open(os.path.join(work, "train.txt"),
                                        encoding="utf-8")
                if l.strip()][:3000]
    va_lines = [l.strip() for l in open(os.path.join(work, "val.txt"),
                                        encoding="utf-8")
                if l.strip()][:750]
    enc_tr = adapter.batch_encode(tr_lines, max_length=128)
    enc_va = adapter.batch_encode(va_lines, max_length=128)
    for arm, scale in arms.items():
        for seed in SEEDS:
            model = nlp.build_bert_mlm(
                vocab_size, hidden=128, layers=2, heads=4, seed=seed,
                embeddings=emb if scale else None,
                inject_scale=scale or "raw")
            _, ppl = nlp.mlm_train(model, enc_tr, epochs=6, batch_size=16,
                                   max_length=128, lr=5e-4, seed=seed,
                                   eval_encoded=enc_va)
            results[arm]["mlm_ppl"].append(float(ppl))
            print(f"{arm} seed={seed}: MLM val ppl {ppl:.1f}", flush=True)

    # Summaries with 95% CIs across (fold, seed) runs.
    summary = {}
    for arm in arms:
        a = np.asarray(results[arm]["cls_acc"])
        p = np.asarray(results[arm]["mlm_ppl"])
        summary[arm] = {
            "cls_mean": round(float(a.mean()), 4),
            "cls_ci95": round(1.96 * float(a.std(ddof=1))
                              / np.sqrt(len(a)), 4),
            "cls_runs": len(a),
            "cls_eval_n_per_seed": results[arm]["cls_n"],
            "mlm_ppl_mean": round(float(p.mean()), 1),
            "mlm_ppl_ci95": round(1.96 * float(p.std(ddof=1))
                                  / np.sqrt(len(p)), 1),
        }
    out = {"results": results, "summary": summary,
           "protocol": {"folds": K_FOLDS, "seeds": list(SEEDS),
                        "n_examples": n, "n_labels": n_labels,
                        "tokenizer": tok_dir}}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
