"""Host-side utilities: image IO bridges, workflow state, profiling."""
