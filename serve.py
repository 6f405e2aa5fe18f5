#!/usr/bin/env python
"""Continuous-batching transcription server entry point (no reference
analogue — the serving runtime is a capability beyond the reference)."""
from deepspeech_tpu.cli.serve import main

if __name__ == "__main__":
    raise SystemExit(main())
