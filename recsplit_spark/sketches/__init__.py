"""Mergeable sketch UDAFs (north rule): HyperLogLog, count-min, Bloom,
KLL, t-digest, theta (KMV set ops), Misra-Gries heavy hitters — all
order-independent (theta/HLL/Bloom exactly; MG up to its error bound)
monoids over Spark partials."""

from .base import MergeableSketch  # noqa: F401
from .bloom import BloomFilter  # noqa: F401
from .checkpoint import CheckpointedBuild  # noqa: F401
from .cms import CountMinSketch  # noqa: F401
from .fd import FrequentDirections  # noqa: F401
from .hll import HyperLogLog  # noqa: F401
from .incremental import (  # noqa: F401
    IncrementalProfile,
    merge_profile_tables,
)
from .kll import KLL, KLLState  # noqa: F401
from .mg import MisraGries, MGState  # noqa: F401
from .multi import (  # noqa: F401
    SketchSpec,
    heavy_ngrams,
    heavy_ngrams_by_key,
    heavy_ngrams_from_states,
    profile,
    profile_by_key,
    profile_estimates,
    profile_estimates_by_key,
    token_ngram_hashes,
)
from .tdigest import TDigest, TDigestState  # noqa: F401
from .theta import (ThetaSketch, ThetaState, distinct_sample,  # noqa: F401
                    distinct_sample_by_key)
from .wsample import WeightedSample, WSampleState  # noqa: F401
