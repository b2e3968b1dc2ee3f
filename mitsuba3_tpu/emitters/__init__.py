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
