from aphrodite_tpu.spec_decode.ngram import NgramProposer

__all__ = ["NgramProposer"]
