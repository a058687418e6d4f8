"""Drop-in `utils` package matching the reference's flat import style."""
