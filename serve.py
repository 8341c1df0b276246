#!/usr/bin/env python
"""Serving entry point: few-shot continuations over HTTP from a warm
checkpoint (fewshot/serve.py).

Usage: python serve.py --data=<yaml> --model=<yaml> --task=<yaml> \
           --checkpt_dir=<dir> [--port 8476]
"""
from fewshot.serve import serve_main

if __name__ == "__main__":
    serve_main()
