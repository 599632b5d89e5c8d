"""Faithful DataFrame-native reconstructions of the reference's 7
queries (SURVEY.md §3): the TAM flagship and the six digital-channel
pipelines + 6-way union, with snapshot/versioned-history/audit
writes. Inputs are reference-shaped tables (FIXTURES.md §B) passed
as a name → DataFrame dict."""
