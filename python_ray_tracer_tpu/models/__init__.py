from .scene import (Scene, Spheres, Planes, Lights, Materials, default_scene,
                    random_scene)
from .camera import Camera, default_camera, euler_rotation
