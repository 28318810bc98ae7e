from .collada import load_dae, SceneInfo  # noqa: F401
from .build import build_scene, FlatScene  # noqa: F401
from .camera import Camera  # noqa: F401
