"""Datalog (CozoScript) front end: parser, rewrites, translation, fixpoint."""
