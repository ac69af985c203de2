from .intersect import intersect_spheres, intersect_planes, closest_hit, any_hit
from .shade import sample, trace_once, reflect
from .render import render_image, render_rays, to_framebuffer
from .soft import render_image_soft, render_rays_soft
