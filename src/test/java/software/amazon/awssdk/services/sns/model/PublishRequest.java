package software.amazon.awssdk.services.sns.model;

/** Signature-contract stub for the engine's reflective SNS binding. */
public class PublishRequest {
  public final String topicArn;
  public final String subject;
  public final String message;
  public final String messageStructure;
  private PublishRequest(Builder b) {
    this.topicArn = b.topicArn;
    this.subject = b.subject;
    this.message = b.message;
    this.messageStructure = b.messageStructure;
  }
  public static Builder builder() { return new Builder(); }
  public static class Builder {
    private String topicArn;
    private String subject;
    private String message;
    private String messageStructure;
    public Builder topicArn(String v) { this.topicArn = v; return this; }
    public Builder subject(String v) { this.subject = v; return this; }
    public Builder message(String v) { this.message = v; return this; }
    public Builder messageStructure(String v) { this.messageStructure = v; return this; }
    public PublishRequest build() { return new PublishRequest(this); }
  }
}
