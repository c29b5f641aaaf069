from nanomod_tpu.native.build import load_native, native_available  # noqa: F401
