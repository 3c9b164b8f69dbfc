from . import sh, rigid_motion
