"""Inference entry point — re-enters train.main(train=False)
(reference: test.py:7-10)."""

from train import main

if __name__ == "__main__":
    main(train=False)
