#!/bin/bash
# Round-5 quality campaign: error bars + committed artifacts (verdict #3/#4/#5).
# Sequential — axon serves one process at a time. Run from /root/repo.
set -u
cd /root/repo
DATA=.quality_runs/ci_64
LOGS=.quality_runs/r5_logs
ART=quality_artifacts
mkdir -p "$ART"

RECIPE="-d $DATA -b 8 -lr 0.003 -th 0.1 0.2 -bpl 3 --alpha 2 -a flip rotate90 zoom -sr cosine_annealed --hard_negative_mining 1 -es 0 -ld $LOGS"

last_ckpt() { ls -d "$LOGS/$1/checkpoints"/checkpoint-* 2>/dev/null | sort | tail -1; }

score() {  # score <experiment_name> <preds_subdir> <use_ema> <artifact_subdir>
  local en=$1 preds=.quality_runs/r5_preds/$2 ema=$3 art=$ART/$4
  local ckpt; ckpt=$(last_ckpt "$en")
  [ -z "$ckpt" ] && { echo "!! no checkpoint for $en"; return 1; }
  timeout 2400 python -m mslesions3d_tpu.cli.predict -d $DATA -m "$ckpt" \
    -o "$preds" -ps validation -sc 0.0 -k 100 -si 0 --use_ema "$ema" || return 1
  for iou in 0.1 0.5; do for sc in 0.1 0.2 0.3 0.5 0.7; do
    timeout 600 python -m mslesions3d_tpu.cli.eval -d $DATA -pd "$preds" \
      -ps validation -sc $sc -iou $iou > /dev/null || return 1
  done; done
  mkdir -p "$art"
  cp "$preds/validation_set/min_score_0.0"/metrics_*.json "$art/" || return 1
  echo "== scored $en -> $art"
}

echo "=== stage 1: score the in-flight seed-970205 4k run"
score K4k_s970205 K4k_s970205 0 seeds_4k/seed970205

echo "=== stage 2: 4k replicates, seeds 1 and 2"
for s in 1 2; do
  timeout 2400 python -m mslesions3d_tpu.cli.train $RECIPE -mi 4000 -rs $s -en K4k_s$s \
    && score K4k_s$s K4k_s$s 0 seeds_4k/seed$s
done

echo "=== stage 3: 24k replicates (run-R recipe + EMA carried), dual-scored"
for s in 970205 1; do
  timeout 4800 python -m mslesions3d_tpu.cli.train $RECIPE -mi 24000 -rs $s \
    --ema_decay 0.999 -en R24k_s$s || continue
  score R24k_s$s R24k_s${s}_raw 0 runs_24k/seed${s}_raw
  score R24k_s$s R24k_s${s}_ema 1 runs_24k/seed${s}_ema
done

echo "=== stage 4: quant + tail stories against the fresh 24k checkpoint"
QQ=$(last_ckpt R24k_s970205)
if [ -n "$QQ" ]; then
  QQ_CKPT="$QQ" QQ_DATA=$DATA timeout 3600 python tools/quant_quality.py \
    > /tmp/quant_quality_r5.log 2>&1 \
    && cp .quality_runs/quant_quality.json "$ART/" 2>/dev/null \
    || echo "!! quant_quality failed (see /tmp/quant_quality_r5.log)"
fi
timeout 3600 python tools/tail_story.py > /tmp/tail_story_r5.log 2>&1 \
  && cp .quality_runs/tail_story.json "$ART/" 2>/dev/null \
  || echo "!! tail_story failed (see /tmp/tail_story_r5.log)"

echo "=== stage 5: train-step roofline"
timeout 3600 python tools/train_roofline.py --out "$ART/train_roofline.json" \
  > /tmp/train_roofline_r5.log 2>&1 || echo "!! train_roofline failed"

echo "=== campaign done"
