#!/usr/bin/env python
"""Convert a reference (torch) DeepSpeech checkpoint to the native format."""
from deepspeech_tpu.cli.import_torch import main

if __name__ == "__main__":
    raise SystemExit(main())
