#!/bin/sh
# Reproduces the RESULTS.md "downstream side-by-side" study end-to-end:
# matched-vocab tokenizers (hyperbolic flagship vs HF BPE), MLM perplexity
# on held-out text, and 10-way topic classification built from the corpus's
# own largest sections. CPU-safe (set JAX_PLATFORMS=cpu to force).
#
# Usage: tools/side_by_side.sh <corpus.txt[.bz2]> <workdir> [vocab=8192]
set -e
CORPUS="$1"
WORK="$2"
V="${3:-8192}"
[ -n "$CORPUS" ] && [ -n "$WORK" ] || {
    echo "usage: $0 <corpus.txt[.bz2]> <workdir> [vocab]" >&2; exit 2; }
mkdir -p "$WORK"
cd "$(dirname "$0")/.."

python - "$CORPUS" "$WORK" <<'EOF'
import re, sys, random
from hyptokenizer_tpu.utils.data import open_text
corpus, work = sys.argv[1], sys.argv[2]
lines = [ln.rstrip("\n") for ln in open_text(corpus)]
n = len(lines)
split = int(n * 0.85)
open(f"{work}/train.txt", "w").write("\n".join(lines[:split]) + "\n")
open(f"{work}/val.txt", "w").write("\n".join(lines[split:]) + "\n")
# 10-way topic classification from the largest sections: a line of <= 6
# words not ending in '.' starts a section.
articles, cur = [], None
for l in lines:
    w = l.split()
    if 0 < len(w) <= 6 and not l.rstrip().endswith("."):
        cur = {"t": l.strip(), "x": []}
        articles.append(cur)
    elif cur is not None and l.strip():
        cur["x"].append(l.strip())
articles = [a for a in articles if a["x"]]
articles.sort(key=lambda a: -sum(len(t) for t in a["x"]))
rows = []
for lab, a in enumerate(articles[:10]):
    for t in a["x"]:
        for s in re.split(r"(?<=\.) ", t):
            if len(s.strip()) > 40:
                rows.append((lab, s.strip()))
random.Random(0).shuffle(rows)
k = int(len(rows) * 0.85)
with open(f"{work}/cls_train.tsv", "w") as f:
    f.writelines(f"{l}\t{s}\n" for l, s in rows[:k])
with open(f"{work}/cls_val.tsv", "w") as f:
    f.writelines(f"{l}\t{s}\n" for l, s in rows[k:])
print(f"{n} lines, {len(rows)} cls examples")
EOF

python -m hyptokenizer_tpu.cli.train_baseline_tokenizers \
    --input-file "$WORK/train.txt" --output-dir "$WORK/baselines" \
    --vocab-size "$V" --kinds bpe

python -m hyptokenizer_tpu.cli.train_enhanced_tokenizer \
    --corpus-path "$WORK/train.txt" --output-dir "$WORK/hyp" \
    --embedding-dim 32 --embed-steps 2000 \
    --max-vocab-size "$V" --target-vocab-size "$V" --steps 60000 \
    --alpha 0.05 --beta 0.9 --gamma 0.05 --merge-threshold 100 \
    --no-use-dense-channel --min-pair-freq 1 --merge-batch 16 \
    --log-every 1024 --no-use-adaptive-curvature \
    --no-use-hierarchical --no-use-compression-aware \
    --pre-split words --merge-policy priority --corpus-max-tokens 2097152

for spec in "bpe $WORK/baselines/bpe_$V.json" "hyperbolic $WORK/hyp"; do
    set -- $spec
    python -m hyptokenizer_tpu.cli.train_nlp_tasks \
        --method "$1" --model-path "$2" --task both \
        --train-text "$WORK/train.txt" --val-text "$WORK/val.txt" \
        --train-cls "$WORK/cls_train.tsv" --val-cls "$WORK/cls_val.tsv" \
        --output-dir "$WORK/nlp_$1" --epochs 6 --max-lines 3000 \
        --hidden-size 128 --num-layers 2 --num-heads 4 --batch-size 16 \
        --max-length 128
done

echo "=== results"
cat "$WORK"/nlp_*/nlp_results.json
