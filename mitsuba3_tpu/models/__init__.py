from .cornell_box import cornell_box
