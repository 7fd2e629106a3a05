#!/usr/bin/env bash
# TPU-native port of the reference launcher
# (/root/reference/scripts/wikihow_finetune.sh): CLIP-RN50 multimodal
# encoder + BERSON ordering wrapper finetuned on WikiHow, heatmap aux
# head (task wikihow_hl_v1). Env overrides: DATA_DIR OUTPUT_ROOT
# OUTPUT_NAME MODEL_PATH; extra CLI flags pass through "$@" (later
# flags win, so e.g. `--model_size tiny --tokenizer_name simple`
# yields a CI-light run).
set -euo pipefail

DATA_NAME="wikihow"
TASK_NAME="wikihow"
MODEL_TYPE="clip"
VISION_MODEL="resnet50"

DATA_DIR="${DATA_DIR:-data/${DATA_NAME}}"
OUTPUT_ROOT="${OUTPUT_ROOT:-outputs}"
OUTPUT_NAME="${OUTPUT_NAME:-wikihow_finetune}"
MODEL_PATH="${MODEL_PATH:-simple}"

python3 -m multimodal_sequencing_tpu.trainers.train \
  --model_name_or_path "${MODEL_PATH}" \
  --config_name "roberta-large" \
  --tokenizer_name "roberta-large" \
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
  --save_steps 2000 \
  --logging_steps 250 \
  --max_eval_steps 1000 \
  --iters_to_eval 50000 \
  --iters_to_eval best \
  --iters_to_eval 40000 \
  --warmup_steps 100 \
  --train_split "train-acl22" \
  --eval_splits "test-acl22_human" \
  "$@"
