#!/usr/bin/env python
"""Batch evaluation entry point (reference test.py CLI surface, TPU-native)."""
from deepspeech_tpu.cli.test import main

if __name__ == "__main__":
    raise SystemExit(main())
