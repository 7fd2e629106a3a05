#!/usr/bin/env bash
# TPU-native port of the reference launcher
# (/root/reference/scripts/recipeqa_pretrain.sh): multimodal pretraining
# on RecipeQA (BERT-base text side). Env overrides: DATA_DIR OUTPUT_ROOT
# OUTPUT_NAME MODEL_PATH CLIP_VISUAL_WEIGHTS; extra CLI flags pass
# through "$@".
set -euo pipefail

DATA_DIR1="recipeQA"
DATA_NAME1="recipeqa"
TASK_TYPE="pretrain"
MODEL_TYPE="clip"
VISION_MODEL="resnet50"

DATA_DIR="${DATA_DIR:-data/${DATA_DIR1}}"
OUTPUT_ROOT="${OUTPUT_ROOT:-outputs}"
OUTPUT_NAME="${OUTPUT_NAME:-recipeqa_pretrain}"
MODEL_PATH="${MODEL_PATH:-simple}"
CLIP_WEIGHTS_FLAG=()
if [[ -n "${CLIP_VISUAL_WEIGHTS:-}" ]]; then
  CLIP_WEIGHTS_FLAG=(--clip_visual_model_weights "${CLIP_VISUAL_WEIGHTS}")
fi

python3 -m multimodal_sequencing_tpu.trainers.run_pretraining \
  --model_name_or_path "${MODEL_PATH}" \
  --config_name "bert-base-uncased" \
  --tokenizer_name "bert-base-uncased" \
  --do_train \
  --do_eval \
  --evaluate_during_training \
  --per_gpu_train_batch_size 4 \
  --per_gpu_eval_batch_size 1 \
  --learning_rate 5e-6 \
  --num_train_epochs 20.0 \
  --max_seq_length 300 \
  --per_seq_max_length 60 \
  --data_dirs "${DATA_DIR}" \
  --data_names "${DATA_NAME1}" \
  --max_story_length 5 \
  --output_root "${OUTPUT_ROOT}" \
  --output_dir "${OUTPUT_NAME}" \
  --task_type "${TASK_TYPE}" \
  --order_criteria "loose" \
  --overwrite_output_dir \
  --multimodal \
  --multimodal_model_type "${MODEL_TYPE}" \
  --vision_model "${VISION_MODEL}" \
  --save_steps 2000 \
  --logging_steps 500 \
  --max_eval_steps 200 \
  --iters_to_eval 20000 \
  --warmup_steps 500 \
  --eval_splits "test-human_annot_only" \
  --train_split "train-human_annot" \
  --mlm_probability 0.1 \
  --multimodal_pretrain_objectives "image_swapping" "patch_based_image_swapping" "patch_based_mrm_classification" \
  "${CLIP_WEIGHTS_FLAG[@]}" \
  "$@"
