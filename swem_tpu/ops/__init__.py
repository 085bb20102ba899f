from swem_tpu.ops.resize import resize, resize_nchw

__all__ = ["resize", "resize_nchw"]
