package software.amazon.awssdk.services.sns;

import java.util.ArrayList;
import java.util.List;
import software.amazon.awssdk.services.sns.model.PublishRequest;

/** Signature-contract stub for the engine's reflective SNS binding:
  * records every publish and the credentials provider it was built
  * with so the contract spec can assert the full chain. */
public class SnsClient {
  public static final List<PublishRequest> published = new ArrayList<>();
  public static Object lastCredentialsProvider;

  private SnsClient() {}
  public static SnsClient create() {
    lastCredentialsProvider = null;
    return new SnsClient();
  }
  public static Builder builder() { return new Builder(); }
  public Object publish(PublishRequest request) {
    published.add(request);
    return new Object();
  }
  public static class Builder {
    private Object credentialsProvider;
    public Builder credentialsProvider(Object p) {
      this.credentialsProvider = p;
      return this;
    }
    public SnsClient build() {
      lastCredentialsProvider = credentialsProvider;
      return new SnsClient();
    }
  }
}
