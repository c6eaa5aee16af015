from .bits import pack_bits, unpack_bits  # noqa: F401
