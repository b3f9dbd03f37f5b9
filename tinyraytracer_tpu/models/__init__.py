"""Scene model: geometry, materials, camera, world container, presets."""
