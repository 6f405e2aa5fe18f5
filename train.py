#!/usr/bin/env python
"""Training entry point (reference train.py CLI surface, TPU-native)."""
from deepspeech_tpu.cli.train import main

if __name__ == "__main__":
    raise SystemExit(main())
