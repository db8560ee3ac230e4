#!/usr/bin/env python
"""Reference-compatible entry point (SURVEY.md C1):
python train.py --path_opt options/vqa2/<model>.yaml [--resume best] [-e]
"""

import sys

from vqa_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
