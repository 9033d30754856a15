from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.attention.backend import paged_attention, write_kv

__all__ = ["AttentionMetadata", "paged_attention", "write_kv"]
