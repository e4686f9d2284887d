from geoformer_tpu.models.geoformer import GeoFormer, MatchOutput  # noqa: F401
