#!/usr/bin/env python
"""Reference-surface entry point (SURVEY.md §2 L4): train driver.

Usage: python train.py --data=<yaml> --model=<yaml> --task=<yaml> [--checkpt_dir=...]
"""
from fewshot.cli import train_main

if __name__ == "__main__":
    train_main()
