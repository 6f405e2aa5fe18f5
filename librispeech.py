#!/usr/bin/env python
"""LibriSpeech download/convert/manifest entry point (reference data/librispeech.py)."""
from deepspeech_tpu.cli.librispeech import main

if __name__ == "__main__":
    raise SystemExit(main())
