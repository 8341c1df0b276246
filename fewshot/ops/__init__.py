"""Pallas (Mosaic) kernel tier — the rebuild's "native" components.

The reference has zero native code (SURVEY.md §3 "Native components"); the
hot op defined by the north star is the fused LSTM scan cell
(BASELINE.json:5), implemented here as TPU Pallas kernels with a custom-VJP
backward so training runs through them too.
"""
