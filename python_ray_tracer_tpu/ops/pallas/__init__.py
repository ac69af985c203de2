from .render_pallas import render_image_pallas, render_image_fast
from .render_bwd import scene_grads_pallas
from .soft_pallas import render_image_soft_pallas, render_image_soft_fast
