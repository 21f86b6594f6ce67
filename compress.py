#!/usr/bin/env python
"""Drop-in CLI: ``python compress.py in.png out [flags]`` (see jpeg_tpu/cli)."""
from jpeg_tpu.cli.compress import main

if __name__ == "__main__":
    main()
