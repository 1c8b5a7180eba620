"""Scene pipeline: meshes, entities, materials, textures, flatten, BVH.

Host-side Python (numpy) that produces the flat SoA device tensors the
integrator consumes — counterpart of the reference's asset/scene layer
(SURVEY.md §2.5-2.6: drawable.c, mesh.c, texture.c, gltf_model.c,
FlattenDrawables).
"""
