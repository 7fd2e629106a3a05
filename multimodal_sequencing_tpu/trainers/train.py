"""Finetune entry point (reference: `python -m trainers.train`)."""
from ..train.cli import main_train

if __name__ == "__main__":
    main_train()
