from fhe_regex_tpu.models.patterns import CompiledPattern, DRIVER_CONFIGS  # noqa: F401
