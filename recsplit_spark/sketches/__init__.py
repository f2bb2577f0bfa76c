"""Mergeable sketch UDAFs (north rule): HyperLogLog, count-min, Bloom,
KLL, t-digest — all order-independent monoids over Spark partials."""

from .base import MergeableSketch  # noqa: F401
from .bloom import BloomFilter  # noqa: F401
from .cms import CountMinSketch  # noqa: F401
from .hll import HyperLogLog  # noqa: F401
from .kll import KLL, KLLState  # noqa: F401
from .tdigest import TDigest, TDigestState  # noqa: F401
