from .fakes import FakeLlmClient, FakeRendererClient, SyntheticSiteHttpClient, ThrowingHttpClient

__all__ = ["SyntheticSiteHttpClient", "FakeRendererClient", "FakeLlmClient", "ThrowingHttpClient"]
