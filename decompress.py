#!/usr/bin/env python
"""Drop-in CLI: ``python decompress.py compressed out.png`` (see jpeg_tpu/cli)."""
from jpeg_tpu.cli.decompress import main

if __name__ == "__main__":
    main()
