#!/usr/bin/env python
"""Reference-surface entry point (SURVEY.md §2 L4): evaluate driver.

Usage: python evaluate.py --data=<yaml> --model=<yaml> --task=<yaml> [--checkpt_dir=...]
"""
from fewshot.cli import evaluate_main

if __name__ == "__main__":
    evaluate_main()
