#!/usr/bin/env bash
# Reproduce the reference's headline LSP(+LSP-ext) recipe end-to-end:
# BASELINE.md Table 2, "combined (best)": KPR 2.64 / MR 27.09 on lsp_val
# after 120 epochs of the full hybrid objective (keypoint + mesh
# reprojection + critic/WGAN-GP) at batch 8 (ref report.pdf §4, eval at
# src/trainer.py:992-995).
#
# Default run uses SYNTHETIC stand-ins (no licensed assets needed): the
# procedural rigged human + rendered ground truth from
# cli/create_synthetic, with a short schedule — a dry-runnable rehearsal
# of the complete real recipe. Flip to the real thing with REAL_ASSETS=1
# once the licensed files are in place.
#
# Synthetic rehearsal (one TPU chip, ~15 min):
#   ./scripts/reproduce_lsp.sh
#
# Real recipe:
#   REAL_ASSETS=1 \
#   SMPL_MODEL=/assets/models/neutral_smpl_with_cocoplus_reg.pkl \
#   MEAN_PARAMS=/assets/models/neutral_smpl_mean_params.h5 \
#   LSP_DIR=/assets/lsp/images LSP_SEG_DIR=/assets/upi-s1h/lsp \
#   LSP_JOINTS=/assets/lsp/joints.mat \
#   LSPE_DIR=/assets/lsp_ext/images LSPE_SEG_DIR=/assets/upi-s1h/lsp_ext \
#   LSPE_JOINTS=/assets/lsp_ext/joints.mat \
#   MOCAP_DIR=/assets/mocap_neutrMosh \
#   ./scripts/reproduce_lsp.sh
#
# Licensed prerequisites for REAL_ASSETS=1 (ref README.md:24-45):
#   - SMPL neutral model pickle (smpl.is.tue.mpg.de) incl. cocoplus
#     regressor, + neutral_smpl_mean_params.h5 (from the HMR release)
#   - LSP + LSP-extended images with joints.mat (sam.johnson.io/research)
#   - Unite-the-People segmentation masks (files.is.tuebingen.mpg.de)
#   - MoSh'ed CMU/jointLim mocap tfrecords (from the HMR release)
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${WORK:-runs/reproduce_lsp}"
EPOCHS="${EPOCHS:-120}"          # report.pdf Table 2 schedule
BATCH="${BATCH:-8}"              # reference default (src/config.py:59)
# Extra flags appended to the train command, e.g.
#   EXTRA_TRAIN_FLAGS="--init_encoder_from runs/imagenet_donor"
EXTRA_TRAIN_FLAGS="${EXTRA_TRAIN_FLAGS:-}"
mkdir -p "$WORK"

if [[ "${REAL_ASSETS:-0}" == "1" ]]; then
  DATASETS="lsp_train,lsp_ext"
  SMPL="$SMPL_MODEL"
  MEAN="${MEAN_PARAMS:-}"
  DATA_DIR="$WORK/datasets"
  if [[ ! -f "$DATA_DIR/lsp_train.tfrecords" ]]; then
    python -m human_pose_estimation_tpu.cli.create_datasets \
      --output_dir "$DATA_DIR" \
      --lsp_dir "$LSP_DIR" --lsp_seg_dir "$LSP_SEG_DIR" \
      --lsp_joints "$LSP_JOINTS" \
      --lsp_ext_dir "$LSPE_DIR" --lsp_ext_seg_dir "$LSPE_SEG_DIR" \
      --lsp_ext_joints "$LSPE_JOINTS" \
      --train_count "${TRAIN_COUNT:-1000}"
    mkdir -p "$DATA_DIR/mocap_neutrMosh"
    cp -n "$MOCAP_DIR"/neutrSMPL_*.tfrecord "$DATA_DIR/mocap_neutrMosh/" || true
  fi
  # lsp_train + lsp_ext are in the built-in table; NUM_EXAMPLES=n
  # overrides for partial/miniature asset sets (epoch accounting).
  NUM_EXAMPLES_FLAG=()
  if [[ -n "${NUM_EXAMPLES:-}" ]]; then
    NUM_EXAMPLES_FLAG=(--num_examples_override "$NUM_EXAMPLES")
  fi
else
  # Synthetic rehearsal: same pipeline, generated ground truth, short
  # schedule. Dataset names reuse lsp_train/lsp_val so the epoch table
  # and flags are IDENTICAL to the real run.
  DATA_DIR="$WORK/datasets_synth"
  SMPL="$WORK/model.npz"
  MEAN=""
  DATASETS="lsp_train"
  EPOCHS="${EPOCHS_SYNTH:-4}"
  if [[ ! -f "$DATA_DIR/lsp_train.tfrecords" ]]; then
    python -m human_pose_estimation_tpu.cli.create_synthetic \
      --out_dir "$DATA_DIR" --n_train 256 --n_val 64 --n_mocap 4096 \
      --img_size 256 --model_out "$SMPL"
  fi
  NUM_EXAMPLES_FLAG=(--num_examples_override 256)
fi

# ---- train: the Table-2 "combined + critic" configuration -------------
python -m human_pose_estimation_tpu.cli.train \
  --data_dir "$DATA_DIR" \
  --datasets "$DATASETS" --val_datasets lsp_val --mocap_datasets CMU \
  --smpl_model_path "$SMPL" \
  ${MEAN:+--smpl_mean_params_path "$MEAN"} \
  --epoch "$EPOCHS" --batch_size "$BATCH" \
  --use_kpr_loss true --use_mesh_repro_loss true \
  --use_gradient_penalty true --encoder_only false \
  --mr_metric_stages last --scalar_log_step 10 \
  "${NUM_EXAMPLES_FLAG[@]}" \
  $EXTRA_TRAIN_FLAGS \
  --logs "$WORK/logs" --checkpoint_dir "$WORK/ckpt"

# ---- evaluate against the reference's numbers --------------------------
# Table 2 combined (best): KPR 2.64 / MR 27.09 on lsp_val; the rebuild
# additionally reports PCK@0.5 (BASELINE.json requires it).
python -m human_pose_estimation_tpu.cli.validate_checkpoint \
  --data_dir "$DATA_DIR" \
  --val_datasets lsp_val --batch_size "$BATCH" \
  --smpl_model_path "$SMPL" \
  ${MEAN:+--smpl_mean_params_path "$MEAN"} \
  "${NUM_EXAMPLES_FLAG[@]}" \
  --checkpoint_dir "$WORK/ckpt" --logs "$WORK/logs"

echo
echo "reference targets (BASELINE.md Table 2, combined + critic):"
echo "  KPR 2.64   MR 27.09   (lsp_val, 120 epochs, batch 8)"
