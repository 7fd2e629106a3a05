#!/usr/bin/env bash
# TPU-native port of the reference launcher
# (/root/reference/scripts/recipeqa_finetune.sh): CLIP-RN50 multimodal
# encoder + BERSON ordering wrapper finetuned on RecipeQA (BERT-base
# text side). Env overrides: DATA_DIR OUTPUT_ROOT OUTPUT_NAME
# MODEL_PATH; extra CLI flags pass through "$@".
set -euo pipefail

DATA_NAME="recipeQA"
TASK_NAME="recipeqa"
MODEL_TYPE="clip"
VISION_MODEL="resnet50"

DATA_DIR="${DATA_DIR:-data/${DATA_NAME}}"
OUTPUT_ROOT="${OUTPUT_ROOT:-outputs}"
OUTPUT_NAME="${OUTPUT_NAME:-recipeqa_finetune}"
MODEL_PATH="${MODEL_PATH:-simple}"

python3 -m multimodal_sequencing_tpu.trainers.train \
  --model_name_or_path "${MODEL_PATH}" \
  --config_name "bert-base-uncased" \
  --tokenizer_name "bert-base-uncased" \
  --do_not_load_optimizer \
  --do_train \
  --do_eval \
  --evaluate_during_training \
  --per_gpu_train_batch_size 1 \
  --per_gpu_eval_batch_size 1 \
  --learning_rate 5e-6 \
  --num_train_epochs 4.0 \
  --max_seq_length 300 \
  --per_seq_max_length 60 \
  --data_dir "${DATA_DIR}" \
  --output_root "${OUTPUT_ROOT}" \
  --output_dir "${OUTPUT_NAME}" \
  --task_name "${TASK_NAME}_hl_v1" \
  --order_criteria "loose" \
  --overwrite_output_dir \
  --multimodal \
  --multimodal_model_type "${MODEL_TYPE}" \
  --vision_model "${VISION_MODEL}" \
  --wrapper_model_type "berson" \
  --train_split "train-human_annot" \
  --save_steps 2000 \
  --logging_steps 250 \
  --max_eval_steps 1000 \
  --iters_to_eval 16000 \
  --warmup_steps 100 \
  --eval_splits "test-acl_human" \
  "$@"
