from geoformer_tpu.engine.ba import ba_solve  # noqa: F401
from geoformer_tpu.engine.lie import se3_exp, se3_log  # noqa: F401
from geoformer_tpu.engine.trajectory import align_umeyama, ate_rmse  # noqa: F401
