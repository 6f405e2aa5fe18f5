#!/usr/bin/env python
"""Single-file transcription entry point (reference transcribe.py surface)."""
from deepspeech_tpu.cli.transcribe import main

if __name__ == "__main__":
    raise SystemExit(main())
