from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.attention.backend import (paged_attention, write_kv,
                                             window_attention, write_tail)

__all__ = ["AttentionMetadata", "paged_attention", "write_kv",
           "window_attention", "write_tail"]
