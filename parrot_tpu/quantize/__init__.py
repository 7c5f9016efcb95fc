from parrot_tpu.quantize import formats

__all__ = ["formats"]
