from feature_tracker_tpu.trackers.klt import BasicKlt, AffineKlt, LssdKlt

__all__ = ["BasicKlt", "AffineKlt", "LssdKlt"]
