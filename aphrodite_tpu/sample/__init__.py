from aphrodite_tpu.sample.metadata import SamplingMetadata, SamplerFlags
from aphrodite_tpu.sample.sampler import sample_tokens

__all__ = ["SamplingMetadata", "SamplerFlags", "sample_tokens"]
