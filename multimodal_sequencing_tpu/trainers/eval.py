"""Sort-decode evaluation entry point (reference: `python -m trainers.eval`)."""
from ..train.cli import main_eval

if __name__ == "__main__":
    main_eval()
