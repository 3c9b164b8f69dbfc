from .camera import Camera, derive_camera_intrinsics, generate_camera_rays_from_uv
from .pointcloud import PointCloud
from .trajectory import CameraTrajectory, generate_camera_circle_path
from .ray import Ray
from .color_corrector import ColorCorrector
from .mesh import Mesh
from .rgbd_image import RGBDImage
from .pointersect_record import PointersectRecord
