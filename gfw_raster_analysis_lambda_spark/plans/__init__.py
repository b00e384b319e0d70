"""Query IR, Raster-SQL front-end, and the DataFrame planner."""
