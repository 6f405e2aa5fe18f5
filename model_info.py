#!/usr/bin/env python
"""Checkpoint inspection entry point (reference model.py:1070-1110 main)."""
from deepspeech_tpu.cli.info import main

if __name__ == "__main__":
    raise SystemExit(main())
