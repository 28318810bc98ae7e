from .intersect import SceneArrays, Hit, scene_to_device, intersect_rays, occluded_rays  # noqa: F401
