"""Supervised-embedding injection study (VERDICT r4 #4): does transferred
hierarchical STRUCTURE (not scale) help downstream BERT?

Round 4 established (results_r4/injection_study_r4.json) that raw-scale
injection costs 8.3 cls points, matched-scale injection restores parity —
i.e. unsupervised hyperbolic embeddings transfer zero measurable benefit.
Round 4 separately trained hierarchy-SUPERVISED flagship embeddings
(work_r4/flagship50k_final, WordNet spearman 0.351 vs 0.057 random). This
study closes the loop: inject the supervised embeddings at matched scale
into the identical CI protocol, against the unsupervised embeddings of the
SAME tokenizer (same merges/vocab — supervision replaces embeddings after
merge training, so tokenization is identical across arms) and a no-injection
control.

Arms:
  none         — fresh BERT init
  unsup_match  — unsupervised flagship embeddings, matched scale
  sup_match    — hierarchy-supervised embeddings, matched scale

Protocol identical to tools/injection_study_r4.py: classification 5-fold CV
x 2 model seeds (pooled accuracy, 95% CI over the 10 runs); MLM 2 seeds,
val perplexity. Reference surface under test:
scripts/train_nlp_tasks.py:160-173,249-253 (embedding export + injection).

Usage: python tools/injection_study_r5.py <workdir> <sup-tok-dir> \
           <unsup-tok-dir> [out.json]
where <workdir> holds wiki.txt (cls classes) + train.txt/val.txt (MLM).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from injection_study_r4 import build_cls_rows  # noqa: E402 (same dir)


def main():
    work = sys.argv[1]
    sup_dir = sys.argv[2]
    unsup_dir = sys.argv[3]
    out_path = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        "results_r5", "injection_study_r5.json")

    from hyptokenizer_tpu.models import nlp

    adapter = nlp.TokenizerAdapter("hyperbolic", sup_dir)
    emb_sup = adapter.get_embeddings()
    adapter_u = nlp.TokenizerAdapter("hyperbolic", unsup_dir)
    emb_unsup = adapter_u.get_embeddings()
    # Same vocabulary => same tokenization: the arms differ ONLY in the
    # injected values. Guard it, since the claim depends on it.
    assert adapter.get_vocab_size() == adapter_u.get_vocab_size(), \
        "supervised/unsupervised artifacts must share the vocab"
    vocab_size = adapter.get_vocab_size()

    rows = build_cls_rows(os.path.join(work, "wiki.txt"))
    labels_all = [l for l, _ in rows]
    texts_all = [t for _, t in rows]
    n_labels = max(labels_all) + 1
    enc_all = adapter.batch_encode(texts_all, max_length=128)
    n = len(rows)
    print(f"cls dataset: {n} examples, {n_labels} classes", flush=True)

    K_FOLDS, SEEDS = 5, (0, 1)
    folds = np.arange(n) % K_FOLDS

    def subset(enc, labs, mask):
        idx = np.nonzero(mask)[0]
        return ({"input_ids": [enc["input_ids"][i] for i in idx],
                 "attention_mask": [enc["attention_mask"][i] for i in idx]},
                [labs[i] for i in idx])

    arms = {"none": None, "unsup_match": emb_unsup, "sup_match": emb_sup}
    results = {a: {"cls_acc": [], "cls_n": 0, "mlm_ppl": []} for a in arms}

    for arm, emb in arms.items():
        for seed in SEEDS:
            correct = total = 0
            for k in range(K_FOLDS):
                tr_enc, tr_lab = subset(enc_all, labels_all, folds != k)
                va_enc, va_lab = subset(enc_all, labels_all, folds == k)
                model = nlp.build_bert_classifier(
                    vocab_size, num_labels=n_labels, hidden=128, layers=2,
                    heads=4, seed=seed, embeddings=emb,
                    inject_scale="matched")
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

    tr_lines = [l.strip() for l in open(os.path.join(work, "train.txt"),
                                        encoding="utf-8")
                if l.strip()][:3000]
    va_lines = [l.strip() for l in open(os.path.join(work, "val.txt"),
                                        encoding="utf-8")
                if l.strip()][:750]
    enc_tr = adapter.batch_encode(tr_lines, max_length=128)
    enc_va = adapter.batch_encode(va_lines, max_length=128)
    for arm, emb in arms.items():
        for seed in SEEDS:
            model = nlp.build_bert_mlm(
                vocab_size, hidden=128, layers=2, heads=4, seed=seed,
                embeddings=emb, inject_scale="matched")
            _, ppl = nlp.mlm_train(model, enc_tr, epochs=6, batch_size=16,
                                   max_length=128, lr=5e-4, seed=seed,
                                   eval_encoded=enc_va)
            results[arm]["mlm_ppl"].append(float(ppl))
            print(f"{arm} seed={seed}: MLM val ppl {ppl:.1f}", flush=True)

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
                        "inject_scale": "matched",
                        "supervised": sup_dir, "unsupervised": unsup_dir}}
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
