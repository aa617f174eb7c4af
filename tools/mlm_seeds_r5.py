"""Extend the round-5 injection study's MLM leg with extra seeds.

The cls leg has 10 runs/arm (CI-grade); the MLM leg had 2 seeds/arm, too
few to claim the unsup-match -32.6 ppl paired delta. This adds seeds to
each arm under the identical protocol (3,000 train / 750 val lines,
matched-scale injection, same tokenizer across arms) and rewrites the
summary with all seeds pooled.

Usage: python tools/mlm_seeds_r5.py <workdir> <sup-tok-dir> <unsup-tok-dir> \
           <study.json> [extra_seeds...]
Default extra seeds: 2 3.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    work, sup_dir, unsup_dir, study_path = sys.argv[1:5]
    seeds = [int(s) for s in sys.argv[5:]] or [2, 3]

    from hyptokenizer_tpu.models import nlp

    adapter = nlp.TokenizerAdapter("hyperbolic", sup_dir)
    emb_sup = adapter.get_embeddings()
    emb_unsup = nlp.TokenizerAdapter("hyperbolic", unsup_dir).get_embeddings()
    vocab_size = adapter.get_vocab_size()

    with open(study_path) as f:
        study = json.load(f)

    tr_lines = [ln.strip() for ln in open(os.path.join(work, "train.txt"),
                                          encoding="utf-8")
                if ln.strip()][:3000]
    va_lines = [ln.strip() for ln in open(os.path.join(work, "val.txt"),
                                          encoding="utf-8")
                if ln.strip()][:750]
    enc_tr = adapter.batch_encode(tr_lines, max_length=128)
    enc_va = adapter.batch_encode(va_lines, max_length=128)

    arms = {"none": None, "unsup_match": emb_unsup, "sup_match": emb_sup}
    for arm, emb in arms.items():
        for seed in seeds:
            model = nlp.build_bert_mlm(
                vocab_size, hidden=128, layers=2, heads=4, seed=seed,
                embeddings=emb, inject_scale="matched")
            _, ppl = nlp.mlm_train(model, enc_tr, epochs=6, batch_size=16,
                                   max_length=128, lr=5e-4, seed=seed,
                                   eval_encoded=enc_va)
            study["results"][arm]["mlm_ppl"].append(float(ppl))
            print(f"{arm} seed={seed}: MLM val ppl {ppl:.1f}", flush=True)

    for arm in arms:
        p = np.asarray(study["results"][arm]["mlm_ppl"])
        study["summary"][arm]["mlm_ppl_mean"] = round(float(p.mean()), 1)
        study["summary"][arm]["mlm_ppl_ci95"] = round(
            1.96 * float(p.std(ddof=1)) / np.sqrt(len(p)), 1)
        study["summary"][arm]["mlm_runs"] = len(p)
    study["protocol"]["mlm_seeds"] = (
        list(study["protocol"]["seeds"]) + seeds)
    with open(study_path, "w") as f:
        json.dump(study, f, indent=2)
    print(json.dumps(study["summary"], indent=2))


if __name__ == "__main__":
    main()
