"""Host-side data pipeline: datasets, loaders, keyframe buffers, tuples.

Heavy submodules (datasets, loader) are imported lazily by the registry;
import `simplerecon_tpu.data.registry.get_dataset` for dataset lookup.
"""
