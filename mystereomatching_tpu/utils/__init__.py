from mystereomatching_tpu.utils import metrics, imio, timing  # noqa: F401
