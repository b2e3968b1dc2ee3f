"""Emitter plugins — counterparts of src/emitters/.

Area emitters live on scene faces (face_emitter + em_radiance tables);
the environment emitter is the scene-level envmap/constant
(emitters/envmap.py); delta emitters (point/spot/directional) are rows of
scene.de_params, sampled in Scene._eval_delta_emitter.
"""

# delta emitter type ids (static `delta_emitter_types` entries)
POINT = 0
SPOT = 1
DIRECTIONAL = 2
PROJECTOR = 3

# de_params row layout (width 20):
#   [0:3] position, [3:6] intensity/irradiance RGB, [6:9] axis (+z),
#   [9] cos_cutoff, [10] cutoff_rad, [11] 1/transition_width,
#   [12] texture slot + 1 (projector), [13:16] axis_x, [16:19] axis_y,
#   [19] tan(fov/2) (projector)
DE_ROW = 20
