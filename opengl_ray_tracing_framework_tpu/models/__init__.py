from .material import Material, MaterialTable
from .camera import Camera
from .scene import Scene, SceneData

__all__ = ["Material", "MaterialTable", "Camera", "Scene", "SceneData"]
