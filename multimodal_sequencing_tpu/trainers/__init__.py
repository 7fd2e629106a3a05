"""Reference-compatible entry modules:
python -m multimodal_sequencing_tpu.trainers.train
python -m multimodal_sequencing_tpu.trainers.run_pretraining
python -m multimodal_sequencing_tpu.trainers.eval
"""
