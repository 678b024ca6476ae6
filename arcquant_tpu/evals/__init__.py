"""Accuracy evaluation: perplexity protocol and dataset loaders."""

from .ppl import eval_ppl
from .data import get_token_stream, get_calib_samples, synthetic_stream
