#!/usr/bin/env python
"""Reference-compatible entry point (SURVEY.md C15): offline grid-feature
extraction to HDF5. See vqa_tpu/cli/extract.py."""

import sys

from vqa_tpu.cli.extract import main

if __name__ == "__main__":
    sys.exit(main())
