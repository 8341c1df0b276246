#!/usr/bin/env python
"""Reference-surface entry point (SURVEY.md §2 L4): sample driver.

Usage: python sample.py --data=<yaml> --model=<yaml> --task=<yaml> [--checkpt_dir=...]
"""
from fewshot.cli import sample_main

if __name__ == "__main__":
    sample_main()
