from aasist_tpu.models.aasist import AasistModel  # noqa: F401
