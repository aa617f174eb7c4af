#!/bin/sh
# Round-3 MLM side-by-side (VERDICT r2 #6): the sync_every=64 flagship recipe
# vs BOTH HF baselines — the legacy Whitespace BPE (drops 18% of chars) and
# the fair lossless byte-level BPE. Assumes the work dir was prepared by the
# split block of tools/side_by_side.sh (train.txt/val.txt/cls_*.tsv).
#
# Usage: tools/mlm_study_r3.sh <workdir> [vocab=8192] [sync_every=64]
set -e
WORK="$1"
V="${2:-8192}"
SYNC="${3:-64}"
[ -n "$WORK" ] || { echo "usage: $0 <workdir> [vocab] [sync_every]" >&2; exit 2; }
cd "$(dirname "$0")/.."

python -m hyptokenizer_tpu.cli.train_baseline_tokenizers \
    --input-file "$WORK/train.txt" --output-dir "$WORK/baselines" \
    --vocab-size "$V" --kinds bpe,bytelevel

python -m hyptokenizer_tpu.cli.train_enhanced_tokenizer \
    --corpus-path "$WORK/train.txt" --output-dir "$WORK/hyp_sync$SYNC" \
    --embedding-dim 32 --embed-steps 2000 \
    --max-vocab-size "$V" --target-vocab-size "$V" --steps 60000 \
    --alpha 0.05 --beta 0.9 --gamma 0.05 --merge-threshold 100 \
    --no-use-dense-channel --min-pair-freq 1 --merge-batch 16 \
    --log-every 1024 --sync-every "$SYNC" --no-use-adaptive-curvature \
    --no-use-hierarchical --no-use-compression-aware \
    --pre-split words --merge-policy priority --corpus-max-tokens 2097152

for method in bpe bytelevel hyperbolic; do
    # Model path derived per method (no word-splitting: $WORK may contain
    # spaces — ADVICE r3).
    case "$method" in
        bpe)        model="$WORK/baselines/bpe_$V.json" ;;
        bytelevel)  model="$WORK/baselines/bytelevel_$V.json" ;;
        hyperbolic) model="$WORK/hyp_sync$SYNC" ;;
    esac
    python tools/tok_stats.py "$WORK/val.txt" "$model" \
        "$([ "$method" = hyperbolic ] && echo hyperbolic || echo hf)"
    python -m hyptokenizer_tpu.cli.train_nlp_tasks \
        --method "$method" --model-path "$model" --task both \
        --train-text "$WORK/train.txt" --val-text "$WORK/val.txt" \
        --train-cls "$WORK/cls_train.tsv" --val-cls "$WORK/cls_val.tsv" \
        --output-dir "$WORK/nlp_$method" --epochs 6 --max-lines 3000 \
        --hidden-size 128 --num-layers 2 --num-heads 4 --batch-size 16 \
        --max-length 128
done

echo "=== results"
cat "$WORK"/nlp_*/nlp_results.json
