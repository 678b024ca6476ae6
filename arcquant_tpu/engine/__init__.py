"""Serving engine: jitted prefill/decode steps over the paged int4 KV
cache, sampling, and a continuous-batching scheduler."""

from .engine import InferenceEngine, EngineConfig
from .scheduler import ContinuousBatcher, Request
from .spec import SpeculativeEngine, NgramDrafter, EngineDrafter
from .sampling import SamplingParams, sample
