#!/usr/bin/env python
"""Manifest merge entry point (reference data/merge_manifests.py)."""
from deepspeech_tpu.cli.merge_manifests import main

if __name__ == "__main__":
    raise SystemExit(main())
