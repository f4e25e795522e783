"""Stage plans: the 4-stage KG-construction pipeline driver."""
