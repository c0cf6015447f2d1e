#!/usr/bin/env python3
"""CLI entry point: `./ska.py build -o out -k 31 s1.fa s2.fa` etc."""
from ska_tpu.cli import main

if __name__ == "__main__":
    main()
