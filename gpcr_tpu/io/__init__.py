from .ply import read_ply, write_ply
from .image import write_png, read_png, save_pic
