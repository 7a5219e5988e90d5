"""Host-side data pipeline: datasets, tuple files, keyframe buffers."""
