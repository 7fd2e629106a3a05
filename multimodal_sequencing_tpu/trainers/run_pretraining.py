"""Pretraining entry point (reference: `python -m trainers.run_pretraining`)."""
from ..train.cli import main_pretrain

if __name__ == "__main__":
    main_pretrain()
