from aphrodite_tpu.lora.models import LoRAManager, lora_apply

__all__ = ["LoRAManager", "lora_apply"]
