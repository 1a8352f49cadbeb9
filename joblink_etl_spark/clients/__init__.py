from .fakes import FakeLlmClient, FakeRendererClient, SyntheticSiteHttpClient

__all__ = ["SyntheticSiteHttpClient", "FakeRendererClient", "FakeLlmClient"]
