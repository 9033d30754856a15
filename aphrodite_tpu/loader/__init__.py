from aphrodite_tpu.loader.weights import create_model, load_model_params

__all__ = ["create_model", "load_model_params"]
