from aphrodite_tpu.structured_output.manager import StructuredOutputManager

__all__ = ["StructuredOutputManager"]
