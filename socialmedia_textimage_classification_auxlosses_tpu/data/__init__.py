from .normalize import TweetNormalizer, tweet_tokenize  # noqa: F401
