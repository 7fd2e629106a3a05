"""Offline tools: image feature extraction (the reference's
`trainers/extract_img_features.py` / `extract_maskrcnn_features.py`)."""
