#!/usr/bin/env bash
# Stage-3 training + DAVIS16/17 evaluation
# (re-design of /root/reference/train_swem_s3.sh:6-70)
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data}
BACKBONE=${BACKBONE:-resnet50}
BATCH=${BATCH:-8}
NOBJ=${NOBJ:-2}
KEYDIM=${KEYDIM:-128}
EM_ITERS=${EM_ITERS:-4}
NBASES=${NBASES:-128}
TOPL=${TOPL:-64}
RESUME=${RESUME:-}            # e.g. logs/SWEM/S0/<exp>/checkpoints
LOG_DIR=${LOG_DIR:-logs}

EXP="BACKBONE_${BACKBONE}_BS${BATCH}_NO${NOBJ}_KD${KEYDIM}_NI${EM_ITERS}_NB${NBASES}_TOP${TOPL}"

ARGS=(--stage 3 --data_root "$DATA_ROOT" --exp "$EXP" --log_dir "$LOG_DIR"
      --backbone "$BACKBONE" --batch_size "$BATCH" --num_obj "$NOBJ"
      --key_dim "$KEYDIM" --em_iters "$EM_ITERS" --num_bases "$NBASES"
      --top_l "$TOPL")
if [[ -n "$RESUME" ]]; then
  ARGS+=(--resume "$RESUME" --from_scratch)
fi

python train.py "${ARGS[@]}"

CKPT="$LOG_DIR/SWEM/S3/$EXP/checkpoints/variables"
for SET in DAVIS16 DAVIS17; do
  python eval.py --eval_set "$SET" --data_root "$DATA_ROOT/DAVIS" \
      --resume "$CKPT" --exp "$EXP" --log_dir "$LOG_DIR" --stage 3 \
      --backbone "$BACKBONE" --key_dim "$KEYDIM" --em_iters "$EM_ITERS" \
      --num_bases "$NBASES" --top_l "$TOPL"
done
